# latent IADB celeba 256^2 eval — reference scripts/sampling/latent_iadb_celeba_res256_test.sh

python -m bndm_tpu.cli.latent_iadb --dataset_name=celeba_res256 --resolution=256 --train_or_test=test --eval_batch_size=50 --test_samples=100 --random_flip --output_dir=latent_iadb_celeba_res256 --train_batch_size=256 --num_epochs=1000 --gradient_accumulation_steps=1 --learning_rate=1e-4 --lr_warmup_steps=0 --out_channels=4 --noise_type=gaussianBN
