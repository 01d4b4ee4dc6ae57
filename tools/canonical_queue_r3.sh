#!/bin/bash
# Round-3 canonical robustness queue (VERDICT item 3): second seeds for
# road1200/road700 under the ILS default, plus a NEW instance (road1600)
# head-to-head vs the reference binary.  Sequential: the runs share one TPU
# and one host LS core.
set -x
cd /root/repo
bash tests/oracle/build_oracle.sh >/tmp/oracle_build.log 2>&1 || true
python tools/canonical.py road1200 --seed 2 --tag r3a \
    > /tmp/canon_road1200_r3a.log 2>&1
python tools/canonical.py road700 --seed 2 --tag r3a \
    > /tmp/canon_road700_r3a.log 2>&1
python tools/canonical_ref.py road1600 \
    > /tmp/canon_ref_road1600.log 2>&1
python tools/canonical.py road1600 --seed 1 --tag r3a \
    > /tmp/canon_road1600_r3a.log 2>&1
echo QUEUE_DONE
