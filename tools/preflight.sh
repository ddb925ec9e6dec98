#!/bin/sh
# End-of-session preflight (round-6 verdict order #3): the LAST action
# before any snapshot commit. Round 6 ended red because the guards
# existed but were not re-run after a mid-edit stop — this script makes
# "re-run them" one command.
#
# Usage:
#   tools/preflight.sh                 # full pytest suite only
#   tools/preflight.sh q1 d77 ...      # + driver_sim the named queries
#
# Exit nonzero on ANY failure; do not commit a snapshot over a red run.
set -e
cd "$(dirname "$0")/.."
REPO="$(pwd)"

echo "== preflight: pytest =="
python -m pytest tests/ -q

if [ "$#" -gt 0 ]; then
    echo "== preflight: driver_sim $* =="
    (cd /tmp && python "$REPO/tools/driver_sim.py" "$@")
fi

echo "== preflight: registry smoke (callable signatures + oracle templates) =="
python - <<'EOF'
import inspect, re, sys
sys.path.insert(0, ".")
from security_master_spark.plans import registry
q, o = registry.queries(), registry.oracle_sql()
def _sig_ok(f):
    try:
        inspect.signature(f).bind("spark", "sf_dir")
        return True
    except TypeError:
        return False
bad = [n for n, f in q.items() if not _sig_ok(f)]
tmpl = [n for n, s in o.items() if re.search(r"\{[A-Za-z_][A-Za-z0-9_]*\}", s)]
assert not bad, f"uncallable registrations: {bad}"
assert not tmpl, f"unexpanded oracle templates: {tmpl}"
print(f"registry ok: {len(q)} queries, {len(o)} oracles")
EOF

echo "== preflight: GREEN =="
