#!/bin/sh
# Batched multi-plate datagen: groups plates by compiled shape and runs
# each group's solves as one device program (scale-out path for multi-chip
# meshes; shard the plate axis over 'dp').
python -m fea_tpu generate \
    --batched --batch_size 8 \
    --num_plates 2500 \
    --conditions_per_plate 4 \
    --steps_per_condition 6 \
    --image_size 512 \
    --save_displacement \
    --save_meshes \
    --data_dir data \
    --seed 0
