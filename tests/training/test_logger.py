"""Logger: reference scalar-name surface + JSONL fallback."""
import json

from neddf_tpu.training.logger import BaseLogger, NeRFTBLogger


class _CaptureLogger(BaseLogger):
    def __init__(self):
        super().__init__()
        self.records = []

    def _next_impl(self, log_dict):
        self.records.append(dict(log_dict))


def test_scalar_names_match_reference():
    lg = _CaptureLogger()
    lg.write_batchstart()
    lg.write_batchend()
    lg.write(0.5, 21.0, {"color": 0.4, "fields_penalty": 0.1}, rays_per_sec=123.0)
    lg.next()
    rec = lg.records[0]
    # the reference's TensorBoard scalar names (base_logger.py:36-47)
    assert {"loss", "PSNR", "iteration duration", "total duration"} <= set(rec)
    assert rec["objective/color"] == 0.4
    assert rec["objective/fields_penalty"] == 0.1
    assert rec["rays per sec"] == 123.0
    assert lg.niter == 1


def test_jsonl_fallback(tmp_path, monkeypatch):
    # force the fallback by making the TB import fail
    import builtins

    real_import = builtins.__import__

    def fail_tb(name, *a, **k):
        if name.startswith("torch"):
            raise ImportError("no tb")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", fail_tb)
    lg = NeRFTBLogger(log_dir=str(tmp_path))
    monkeypatch.setattr(builtins, "__import__", real_import)
    lg.write(1.0, 30.0, {"color": 1.0})
    lg.next()
    lines = (tmp_path / "train_log.jsonl").read_text().splitlines()
    rec = json.loads(lines[0])
    assert rec["iter"] == 0 and rec["loss"] == 1.0
