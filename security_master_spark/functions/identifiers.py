"""Security-identifier validation (the identity layer of a securities
master): ISIN check digits (ISO 6166 — Luhn over the base-36 digit
expansion), as pure JVM expression trees (higher-order transform /
aggregate — no UDF, codegen-friendly, null-propagating).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _char_value(c: Column) -> Column:
    """ISO 6166 character value: '0'-'9' → 0-9, 'A'-'Z' → 10-35."""
    return F.when(c.between("0", "9"), c.cast("int")).otherwise(
        F.ascii(c) - 55
    )


def isin_check_digit(payload: Column) -> Column:
    """Luhn check digit for an 11-char ISIN payload (2-letter country +
    9 alphanumerics, WITHOUT the check digit).

    Steps, all expression-level: expand each character to its decimal
    value (letters become TWO digits), concatenate, then Luhn from the
    RIGHTMOST expanded digit (double every other one starting with the
    rightmost; digit-sum the products). Returns the int check digit."""
    chars = F.split(payload, "")
    expanded = F.concat_ws(
        "", F.transform(chars, lambda c: _char_value(c).cast("string"))
    )
    rdigits = F.split(F.reverse(expanded), "")
    contrib = F.transform(
        rdigits,
        lambda c, i: F.when(
            i % 2 == 0,
            # doubled digit, then digit-sum: 2d if 2d < 10 else 2d - 9
            F.when(c.cast("int") < 5, 2 * c.cast("int")).otherwise(
                2 * c.cast("int") - 9
            ),
        ).otherwise(c.cast("int")),
    )
    total = F.aggregate(contrib, F.lit(0), lambda acc, x: acc + x)
    return (10 - total % 10) % 10


def isin_is_valid(isin: Column) -> Column:
    """True iff the 12-char ISIN's final digit matches the Luhn check
    digit of its first 11 characters."""
    return (
        (F.length(isin) == 12)
        & F.substring(isin, 12, 1).between("0", "9")
        & (
            F.substring(isin, 12, 1).cast("int")
            == isin_check_digit(F.substring(isin, 1, 11))
        )
    )
