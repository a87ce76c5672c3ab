#!/bin/sh
# Unitest driver — same 3-step contract as the reference's unitest.sh:
#   1. inference CLI in --test_mode
#   2. training CLI in --test_mode
#   3. log checker
# Test data ships with the reference checkout; point NANOREV_DATA elsewhere
# to run against your own fast5 directories.

set -e
DATA="${NANOREV_DATA:-/root/reference/unitest}"
MODELS="${NANOREV_MODELS:-/root/reference/model}"

rm -f ./unitest/unitest_log.txt

echo "[1/3] NanoReviser inference unitest"
python NanoReviser.py -d "$DATA/test_data/fast5/" -o ./unitest/fastq_file/ \
    -F fasta --test_mode --model_dir_root "$MODELS/"

echo "[2/3] NanoReviser_train unitest"
python NanoReviser_train.py -d "$DATA/training_data/fast5/" \
    -o ./unitest/nanorev_training_result/ --test_mode \
    -t ./unitest/train_tmp/ -M ./unitest/model/

echo "[3/3] checking log"
python ./unitest/check_nanoreviser.py
