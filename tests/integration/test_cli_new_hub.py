"""`marie new` scaffolding and `marie hub` CLI (reference
marie_cli/api.py:179 `new`; jina-style hub commands)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cli(*argv, cwd=None, env=None):
    e = dict(os.environ)
    e.update(env or {})
    return subprocess.run(
        [sys.executable, "-m", "marie_tpu_cli", *argv],
        capture_output=True, text=True, cwd=cwd or REPO, env=e, timeout=120,
    )


def test_new_scaffolds_flow_project(tmp_path):
    proj = tmp_path / "myproj"
    r = _cli("new", str(proj))
    assert r.returncode == 0, r.stderr
    assert (proj / "flow.yml").exists()
    assert (proj / "executor1" / "executor.py").exists()
    assert (proj / "executor1" / "config.yml").exists()
    assert (proj / "client.py").exists()
    # refuses to overwrite
    r2 = _cli("new", str(proj))
    assert r2.returncode == 1
    assert "already exists" in r2.stdout


def test_new_deployment_template(tmp_path):
    proj = tmp_path / "depproj"
    r = _cli("new", str(proj), "--type", "deployment")
    assert r.returncode == 0, r.stderr
    assert (proj / "deployment.yml").exists()


def test_scaffolded_flow_actually_serves(tmp_path):
    """The generated project is runnable: load its flow.yml, start it,
    and round-trip a request through the scaffolded executor."""
    proj = tmp_path / "liveproj"
    assert _cli("new", str(proj)).returncode == 0

    from marie_tpu.clients import Client
    from marie_tpu.orchestrate.flow import Flow
    from marie_tpu.types.docs import Document

    cwd = os.getcwd()
    os.chdir(proj)  # flow.yml references executor1/config.yml relatively
    try:
        flow = Flow.load_config("flow.yml")
        with flow:
            docs = Client(port=flow.port_gateway).post(
                "/process", [Document(text="hi")]
            )
            assert docs[0].text == "processed: hi"
    finally:
        os.chdir(cwd)


def test_hub_cli_roundtrip(tmp_path):
    env = {
        "MARIE_HUB_DIR": str(tmp_path / "hub"),
        "MARIE_HUB_INSTALL": str(tmp_path / "install"),
    }
    proj = tmp_path / "hubproj"
    assert _cli("new", str(proj)).returncode == 0
    exec_dir = str(proj / "executor1")

    r = _cli("hub", "push", exec_dir, "--name", "myexec",
             "--version", "1.2.3", env=env)
    assert r.returncode == 0, r.stderr

    r = _cli("hub", "list", env=env)
    assert "myexec:1.2.3" in r.stdout

    r = _cli("hub", "versions", "myexec", env=env)
    assert "1.2.3" in r.stdout

    r = _cli("hub", "pull", "myexec:1.2.3", env=env)
    assert r.returncode == 0, r.stderr
    installed = r.stdout.strip().splitlines()[-1]
    assert os.path.isdir(installed), installed
    assert os.path.exists(os.path.join(installed, "config.yml"))


def test_help_lookup():
    r = _cli("help", "port")
    assert r.returncode == 0
    assert "marie server" in r.stdout and "--port" in r.stdout
    r = _cli("help", "entrypoint")
    assert r.returncode == 0 and "job submit" in r.stdout
    r = _cli("help", "definitely-not-an-arg")
    assert r.returncode == 1


def test_completions_bash_script_works():
    r = _cli("completions", "bash")
    assert r.returncode == 0
    script = r.stdout
    # the generated function really completes under bash
    probe = (
        script
        + '\nCOMP_WORDS=(marie se); COMP_CWORD=1; _marie_complete; echo "${COMPREPLY[@]}"'
        + '\nCOMP_WORDS=(marie server --po); COMP_CWORD=2; _marie_complete; echo "${COMPREPLY[@]}"'
    )
    out = subprocess.run(["bash", "-c", probe], capture_output=True,
                         text=True, timeout=30)
    lines = out.stdout.strip().splitlines()
    assert lines[-2] == "server"
    assert lines[-1] == "--port"
    # zsh variant emits a compdef script
    rz = _cli("completions", "zsh")
    assert rz.returncode == 0 and rz.stdout.startswith("#compdef marie")
