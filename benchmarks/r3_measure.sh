#!/bin/bash
# Round-3 TPU measurement sweep.  Run in background with a generous
# timeout once the tunnel relay is up; logs land in /tmp/r3m_*.log.
# Order matters: smoke warms the remote compile cache first.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"

python -u examples/smoke.py                  > /tmp/r3m_smoke.log 2>&1
python -u bench.py --full                    > /tmp/r3m_bench.log 2>&1
python -u benchmarks/profile_mix_kinds.py    > /tmp/r3m_mix.log   2>&1
python -u benchmarks/profile_mix_kinds.py --fast-rng \
                                             > /tmp/r3m_mixf.log  2>&1
python -u benchmarks/profile_detect.py res101 --batch 8 \
                                             > /tmp/r3m_det8.log  2>&1
# regenerate the noise-grid baseline (wavelet rows stale since the
# bf16x3 DWT precision change — see RESULTS.md note)
python -u experiments/noise_grid.py --net res101 \
                                             > /tmp/r3m_grid.log  2>&1
echo DONE
