"""Training metrics logging: JSONL always, TensorBoard when available.

Replaces the reference's ``accelerator.log({loss, lr, step, [ema_decay]})``
tensorboard/wandb logging (ddim_diffusers.py:812-816, latent_...:658-662)
and its matplotlib loss/param curves (iadb_bn.py:1011-1025).
"""

from __future__ import annotations

import json
import os
import time


class MetricLogger:
    def __init__(self, logdir, use_tensorboard=True):
        os.makedirs(logdir, exist_ok=True)
        self.logdir = logdir
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(logdir)
            except Exception:
                self._tb = None

    def log(self, metrics, step):
        rec = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            rec[k] = float(v)
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), int(step))

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def save_loss_curve(losses, path):
    """losses.png like the reference (iadb_bn.py:1011-1014)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(1)
    plt.plot(losses)
    plt.savefig(path)
    plt.clf()


def save_sched_param_curves(p0, p1, p2, path):
    """scheduler_params.png (iadb_bn.py:1018-1023)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(1)
    plt.plot(p0)
    plt.plot(p1)
    plt.plot(p2)
    plt.savefig(path)
    plt.clf()
