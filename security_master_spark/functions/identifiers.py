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
    """True iff the 12-char ISIN is well-formed (2-letter country code,
    9 alphanumerics, digit check) AND its final digit matches the Luhn
    check digit of its first 11 characters. The character-class guard
    matters: without it any out-of-class char (lowercase, punctuation)
    falls through ``ascii(c)-55`` and can coincidentally validate."""
    return (
        isin.rlike("^[A-Z]{2}[0-9A-Z]{9}[0-9]$")
        & (
            F.substring(isin, 12, 1).cast("int")
            == isin_check_digit(F.substring(isin, 1, 11))
        )
    )


def _cusip_char_value(c: Column) -> Column:
    """CUSIP character value: '0'-'9' → 0-9, 'A'-'Z' → 10-35,
    '*' → 36, '@' → 37, '#' → 38."""
    return (
        F.when(c.between("0", "9"), c.cast("int"))
        .when(c == "*", F.lit(36))
        .when(c == "@", F.lit(37))
        .when(c == "#", F.lit(38))
        .otherwise(F.ascii(c) - 55)
    )


def cusip_check_digit(base8: Column) -> Column:
    """CUSIP check digit (ANSI X9.6 modulus-10 double-add-double) for
    the 8-char base: positions 2,4,6,8 double their character value,
    every product contributes its DIGIT SUM (v//10 + v%10), check =
    (10 − total mod 10) mod 10. Expression-level fold, no UDF."""
    chars = F.split(base8, "")
    contrib = F.transform(
        chars,
        lambda c, i: F.when(
            (i + 1) % 2 == 0, 2 * _cusip_char_value(c)
        ).otherwise(_cusip_char_value(c)),
    )
    total = F.aggregate(
        contrib,
        F.lit(0),
        lambda acc, v: acc + F.floor(v / 10).cast("int") + (v % 10),
    )
    return ((10 - total % 10) % 10).cast("int")


def cusip_is_valid(cusip: Column) -> Column:
    """True iff the 9-char CUSIP is well-formed (8 chars in the CUSIP
    alphabet [0-9A-Z*@#], digit check) AND its final digit matches the
    check digit of its first 8 characters. The rlike guard keeps
    out-of-class chars (lowercase, punctuation) from coincidentally
    validating via the ``ascii(c)-55`` fallthrough."""
    return (
        cusip.rlike("^[0-9A-Z*@#]{8}[0-9]$")
        & (
            F.substring(cusip, 9, 1).cast("int")
            == cusip_check_digit(F.substring(cusip, 1, 8))
        )
    )


_SEDOL_WEIGHTS = (1, 3, 1, 7, 3, 9)


def sedol_check_digit(base6: Column) -> Column:
    """SEDOL check digit: weighted sum of character values (digits /
    consonants, 'A'-'Z' → 10-35) with weights (1,3,1,7,3,9), check =
    (10 − sum mod 10) mod 10."""
    chars = F.split(base6, "")
    weights = F.array(*[F.lit(w) for w in _SEDOL_WEIGHTS])
    contrib = F.zip_with(
        chars,
        weights,
        lambda c, w: w
        * F.when(c.between("0", "9"), c.cast("int")).otherwise(
            F.ascii(c) - 55
        ),
    )
    total = F.aggregate(contrib, F.lit(0), lambda acc, v: acc + v)
    return ((10 - total % 10) % 10).cast("int")


def sedol_is_valid(sedol: Column) -> Column:
    """True iff the 7-char SEDOL is well-formed (6 alphanumerics, digit
    check) AND its final digit matches the check digit of its first 6
    characters. The rlike guard keeps out-of-class chars from
    coincidentally validating via the ``ascii(c)-55`` fallthrough."""
    return (
        sedol.rlike("^[0-9A-Z]{6}[0-9]$")
        & (
            F.substring(sedol, 7, 1).cast("int")
            == sedol_check_digit(F.substring(sedol, 1, 6))
        )
    )
