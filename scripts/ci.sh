#!/usr/bin/env bash
# Round gate (r3 verdict item 2): the driver scores only the first 50
# registry entries, so a green driver file does NOT mean the surface is
# green — this script is the pre-commit/end-of-round check over the
# FULL surface: every test, every declared query vs its DuckDB oracle,
# and a bench smoke run.
#
#   scripts/ci.sh            # full gate (pytest + full oracle + bench)
#   scripts/ci.sh --quick    # pytest + full oracle only
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== codec totality fuzz (all exported surfaces, walkers included) =="
# r10 verdict item 2: two consecutive rounds a judge Hypothesis draw
# found a totality hole the in-repo gate missed because the ad-hoc
# fuzz drove only decode_* entry points. This gate enumerates targets
# from the module exports (decoders AND walkers/censuses) and runs an
# exhaustive zero-every-byte pass per fixture, so both the r9 JPEG and
# r10 TIFF holes are found deterministically. ~20 s.
python scripts/fuzz_codecs.py

echo "== pytest =="
python -m pytest tests/ -q

echo "== full-registry oracle check (sf0.01) =="
python scripts/check_oracle.py

echo "== scaling gate (r7 verdict item 7) =="
# asserts every recorded SCALING.json ratio is within its input growth
# (10x / 30x) * 1.15 — a reintroduced quadratic fails the gate here
# instead of waiting for a judge. Re-measure with scripts/bench_scale.py
# after touching any measured query.
python scripts/bench_scale.py --assert-within-growth

if [[ "${1:-}" != "--quick" ]]; then
  echo "== bench (sf0.1) =="
  python bench.py
fi
echo "CI GATE GREEN"
