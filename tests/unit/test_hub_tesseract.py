import os

import pytest


def test_hub_push_pull_roundtrip(tmp_path):
    from marie_tpu.hub import ExecutorHub

    exec_dir = tmp_path / "my_exec"
    exec_dir.mkdir()
    (exec_dir / "executor.py").write_text("class MyExec: pass\n")
    (exec_dir / "config.yml").write_text("jtype: MyExec\n")

    hub = ExecutorHub(str(tmp_path / "hub"))
    bundle = hub.push(str(exec_dir), "my-exec", "0.1.0")
    assert os.path.exists(bundle)
    hub.push(str(exec_dir), "my-exec", "0.2.0")

    listed = hub.list()
    assert {(e["name"], e["version"]) for e in listed} == {
        ("my-exec", "0.1.0"), ("my-exec", "0.2.0"),
    }

    installed = hub.pull("my-exec", target_dir=str(tmp_path / "install"))
    assert os.path.exists(os.path.join(installed, "executor.py"))
    # latest version resolution
    with pytest.raises(FileNotFoundError):
        hub.pull("ghost")


def test_tesseract_shell_gated():
    from marie_tpu.document.tesseract_ocr_processor import TesseractOcrProcessor

    proc = TesseractOcrProcessor()
    assert proc.is_available() is False
    with pytest.raises(RuntimeError, match="pytesseract"):
        proc.recognize_from_fragments([])
