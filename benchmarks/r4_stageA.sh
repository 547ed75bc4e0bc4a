#!/bin/bash
# Round-4 stage-A TPU measurement: confirm/refute the round-3 perf claims
# (wavelet 0.44 ms, quant Lloyd trim, fast-rng) that BENCH_r03 never
# measured (tunnel was down).  Logs land in /tmp/r4a_*.log.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"

python -u examples/smoke.py                  > /tmp/r4a_smoke.log 2>&1
python -u bench.py --full                    > /tmp/r4a_bench.log 2>&1
python -u benchmarks/profile_mix_kinds.py    > /tmp/r4a_mix.log   2>&1
python -u benchmarks/profile_mix_kinds.py --fast-rng \
                                             > /tmp/r4a_mixf.log  2>&1
python -u benchmarks/profile_detect.py res101 --batch 8 \
                                             > /tmp/r4a_det8.log  2>&1
echo STAGE_A_DONE
