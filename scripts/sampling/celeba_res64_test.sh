# fig 11: celeba (64x64) — reference scripts/sampling/celeba_res64_test.sh

python -m bndm_tpu.cli.iadb_bn --dataset=celeba_res64 --res=64 --batch_size=500 --train_or_test=test --nb_steps=250 --test_samples=30000 --noise_type=gaussian --scheduler_gamma=linear --scheduler_param=1 --out_channel=3

python -m bndm_tpu.cli.iadb_bn --dataset=celeba_res64 --res=64 --batch_size=500 --train_or_test=test --nb_steps=250 --test_samples=30000 --noise_type=gaussianBN --scheduler_gamma=linear --scheduler_param=1 --out_channel=3

python -m bndm_tpu.cli.ddim --dataset_name=celeba_res64 --train_or_test=test --eval_batch_size=500 --test_samples=30000 --resolution=64 --random_flip --output_dir=ddim_celeba_res64 --train_batch_size=2 --num_epochs=1000 --gradient_accumulation_steps=1 --learning_rate=1e-4 --lr_warmup_steps=0
