# TPU-only kernel tests (the hermetic suite forces CPU and skips these).
# Run on any host with a real TPU attached:

JAX_PLATFORMS=${JAX_PLATFORMS:-} python -m pytest tests/test_fused_noise_tpu.py -q -p no:cacheprovider --override-ini="addopts=" -s
