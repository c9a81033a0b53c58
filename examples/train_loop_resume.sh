# Crash-resilient training driver: the tunneled-device plugin leaks host
# memory per step, so long runs can be OOM-killed; milestones save every
# 500 steps and --checkpoint latest resumes, so just loop until the run
# completes normally.
cd /root/repo
for attempt in 1 2 3 4 5 6 7 8; do
  python -m fea_tpu train \
    --data_dir /root/repo/runs/train_data --sample_data_dir /root/repo/runs/eval_data \
    --image_size 256 --batch_size 16 --num_steps 10000 \
    --learning_rate 3e-4 --num_steps_per_milestone 500 \
    --conditions_per_plate 4 --num_steps_per_condition 6 \
    --num_steps_per_sample_condition 6 --num_sample_conditions_per_plate 1 \
    --skip_dataset_size_check \
    --results_dir /root/repo/runs/results --checkpoint auto
  rc=$?
  echo "ATTEMPT $attempt EXIT $rc"
  if [ $rc -eq 0 ]; then break; fi
  sleep 20
done
python -m fea_tpu sample --milestone best \
  --data_dir /root/repo/runs/train_data --sample_data_dir /root/repo/runs/eval_data \
  --image_size 256 --batch_size 16 \
  --num_steps_per_condition 6 --num_sample_conditions_per_plate 4 \
  --results_dir /root/repo/runs/results
python -m fea_tpu accuracy \
  --data_dir /root/repo/runs/eval_data --results_dir /root/repo/runs/results \
  --milestone best --image_size 256 --num_plates 16 --conditions_per_plate 4 \
  --steps_per_condition 6
echo PIPELINE_DONE
