from bndm_tpu.ckpt.manager import CheckpointManager

__all__ = ["CheckpointManager"]
