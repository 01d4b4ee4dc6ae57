#!/bin/bash
# Round-3c canonical queue: device-assisted head-to-heads on the remaining
# road instances (road900 already has its assisted record).  Sequential:
# the runs share one TPU and one host LS core.
set -x
cd /root/repo
python tools/canonical.py road1200 --seed 1 --tag r3assist \
    --out /tmp/canonical_road1200_r3assist.json \
    > /tmp/canon_road1200_r3assist.log 2>&1
python tools/canonical.py road700 --seed 1 --tag r3assist \
    --out /tmp/canonical_road700_r3assist.json \
    > /tmp/canon_road700_r3assist.log 2>&1
python tools/canonical.py road1600 --seed 2 --tag r3assist \
    --out /tmp/canonical_road1600_r3assist.json \
    > /tmp/canon_road1600_r3assist.log 2>&1
python tools/canonical.py road900 --seed 2 --tag r3assist \
    --out /tmp/canonical_road900_r3assist2.json \
    > /tmp/canon_road900_r3assist2.log 2>&1
echo QUEUE_DONE
