#!/bin/sh
# Canonical LoC breakdown for verdict/audit documents (ADVICE r3: LoC
# claims must be reproducible — this is the exact command to cite).
# Usage: sh scripts/loc_report.sh   (run from the repo root)
set -e
cd "$(dirname "$0")/.."
count() { find "$@" \( -name '*.py' -o -name '*.cpp' -o -name '*.sh' \) -type f -print0 2>/dev/null | xargs -0 cat 2>/dev/null | wc -l; }
pkg=$(count satlas_sr_tpu native)
scripts=$(count scripts)
tests=$(count tests)
bench=$(cat bench.py __graft_entry__.py | wc -l)
echo "satlas_sr_tpu + native : $pkg"
echo "scripts                : $scripts"
echo "bench.py + graft entry : $bench"
echo "non-test source total  : $((pkg + scripts + bench))"
echo "tests                  : $tests"
# Test count is generated, never hard-coded in docs (ADVICE r3 / VERDICT r4
# weak#3: literal counts drift every round).
if command -v python >/dev/null 2>&1; then
  n=$(JAX_PLATFORMS=cpu python -m pytest tests/ --collect-only -q 2>/dev/null | tail -1)
  echo "pytest collected       : $n"
fi
