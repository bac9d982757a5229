import json

from bndm_tpu.utils.logging import MetricLogger, save_loss_curve, save_sched_param_curves


def test_jsonl_logging(tmp_path):
    logger = MetricLogger(str(tmp_path), use_tensorboard=False)
    logger.log({"loss": 1.5, "lr": 1e-4}, step=0)
    logger.log({"loss": 1.2}, step=1)
    logger.close()
    lines = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert lines[0]["loss"] == 1.5 and lines[0]["step"] == 0
    assert lines[1]["step"] == 1


def test_curve_pngs(tmp_path):
    save_loss_curve([3.0, 2.0, 1.0], str(tmp_path / "losses.png"))
    save_sched_param_curves([1, 2], [3, 4], [5, 6], str(tmp_path / "sp.png"))
    assert (tmp_path / "losses.png").exists()
    assert (tmp_path / "sp.png").exists()
