#!/bin/bash
# Three-phase SNIPER training with negative-chip mining
# (reference scripts/train_neg_props_and_sniper.sh):
#   1. train an RPN-only model for 2 epochs (no neg chips),
#   2. extract proposals over the training set,
#   3. full SNIPER training with USE_NEG_CHIPS consuming the proposals.
set -euo pipefail
CFG=${1:?usage: train_neg_props_and_sniper.sh <config.yml>}
cd "$(dirname "$0")/.."

echo "== phase 1: RPN-only training =="
python main_train.py --cfg "$CFG" --set \
    TRAIN.ONLY_PROPOSAL True TRAIN.USE_NEG_CHIPS False TRAIN.end_epoch 2

echo "== phase 2: proposal extraction =="
python main_test.py --cfg "$CFG" --set \
    TEST.EXTRACT_PROPOSALS True TRAIN.ONLY_PROPOSAL True

echo "== phase 3: full SNIPER training with neg chips =="
python main_train.py --cfg "$CFG" --set \
    TRAIN.USE_NEG_CHIPS True proposal_path output/proposals
