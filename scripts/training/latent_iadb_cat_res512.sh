# canonical hyperparameters from the reference's scripts/training/latent_iadb_cat_res512.sh
# (accelerate launch -> plain python: JAX shards over all local TPU chips itself)

python -m bndm_tpu.cli.latent_iadb --dataset_name=cat_res512 --resolution=512 --random_flip --output_dir=latent_iadb_cat_res512 --train_batch_size=256 --gradient_accumulation_steps=1 --learning_rate=1e-4 --lr_warmup_steps=0 --out_channels=4 --num_epochs=1000 --noise_type=gaussian

python -m bndm_tpu.cli.latent_iadb --dataset_name=cat_res512 --resolution=512 --random_flip --output_dir=latent_iadb_cat_res512 --train_batch_size=256 --gradient_accumulation_steps=1 --learning_rate=1e-4 --lr_warmup_steps=0 --out_channels=4 --num_epochs=1000 --noise_type=gaussianBN
