# TPU-only kernel tests (the hermetic suite forces CPU and skips these).
# Run on a host with a real TPU attached:

BNDM_TPU_TESTS=1 python -m pytest tests/test_fused_noise_tpu.py -q
