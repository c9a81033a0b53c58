#!/bin/sh
# Production training config — the reference's train_model.sh (l2 loss,
# 256px, batch 16, 10k steps) with optional wandb logging.
python -m fea_tpu train \
    --data_dir data \
    --sample_data_dir sample_data \
    --image_size 256 \
    --batch_size 16 \
    --num_steps 10000 \
    --num_steps_per_milestone 500 \
    --learning_rate 3e-4 \
    --loss_type l2 \
    --results_dir results
    # --use_wandb --wandb_project fea-tpu
