"""Metric logging + stdout tee (reference utils/train.py:17-24,
utils/logger.py:4-17).

Direct unit coverage of the observability surface: the JSONL logger's
record format (the zero-egress wandb substitute), the create_logger
fallback when wandb can't initialize, and the stdout/stderr tee.
"""

import json
import sys

import numpy as np

from tpu3dssf.utils.logging import (
    JsonlLogger,
    NullLogger,
    Tee,
    create_logger,
    tee_stdout,
)


def test_jsonl_logger_records_floats_and_appends(tmp_path):
    lg = JsonlLogger(str(tmp_path))
    lg.log({"loss": np.float32(1.5), "step": 3, "tag": "a"})
    lg.log({"loss": 0.25})
    lg.finish()
    lines = [json.loads(l) for l in open(lg.path)]
    assert len(lines) == 2
    assert lines[0]["loss"] == 1.5 and lines[0]["tag"] == "a"
    assert lines[0]["step"] == 3.0  # numerics coerced to float
    assert "_time" in lines[0]
    # append-only across logger instances (resume keeps history)
    lg2 = JsonlLogger(str(tmp_path))
    lg2.log({"loss": 0.1})
    lg2.finish()
    assert len(open(lg.path).readlines()) == 3


def test_create_logger_falls_back_to_jsonl_without_wandb(tmp_path,
                                                         capsys):
    # no network egress in this image: wandb.init (if importable at all)
    # must fail → JSONL fallback, never an exception to the caller
    lg = create_logger(str(tmp_path), wandb_project="nope",
                       wandb_entity="nobody")
    if not isinstance(lg, JsonlLogger):  # wandb offline-mode succeeded
        lg.finish()
        return
    lg.log({"x": 1})
    lg.finish()
    assert json.loads(open(lg.path).readline())["x"] == 1.0


def test_create_logger_defaults_to_jsonl_and_null_logs(tmp_path):
    lg = create_logger(str(tmp_path))
    assert isinstance(lg, JsonlLogger)
    lg.finish()
    NullLogger().log({"anything": 1})  # no-op, no error


def test_tee_mirrors_stdout_to_file(tmp_path):
    out, err = sys.stdout, sys.stderr
    try:
        tee = tee_stdout(str(tmp_path), "run.log")
        print("hello tee")
        print("on stderr", file=sys.stderr)
        tee.flush()
    finally:
        sys.stdout, sys.stderr = out, err
    text = open(tmp_path / "run.log").read()
    assert "hello tee" in text and "on stderr" in text
    assert isinstance(tee, Tee)
