"""Executor hub — package/publish/install executors.

Counterpart of the reference's Hubble client (``/root/reference/hubble/``
— push/pull executor images).  Without a remote registry in this
environment, the hub is a local/shared-directory store of executor
bundles (tarball of the executor package + ``manifest.yml``); the same
API can front a remote registry.
"""

import io
import json
import os
import shutil
import tarfile
import time
from typing import Any, Dict, List, Optional

import yaml

from marie_tpu.logging_core import MarieLogger

_DEFAULT_HUB = os.path.expanduser("~/.marie/hub")


class ExecutorHub:
    def __init__(self, hub_dir: str = _DEFAULT_HUB):
        self.hub_dir = hub_dir
        os.makedirs(hub_dir, exist_ok=True)
        self.logger = MarieLogger("hub")

    # --- push -----------------------------------------------------------
    def push(
        self,
        executor_dir: str,
        name: str,
        version: str = "0.1.0",
        metadata: Optional[Dict[str, Any]] = None,
    ) -> str:
        """Bundle an executor directory and publish it to the hub."""
        if not os.path.isdir(executor_dir):
            raise FileNotFoundError(executor_dir)
        manifest = {
            "name": name,
            "version": version,
            "pushed_at": time.time(),
            **(metadata or {}),
        }
        bundle_path = os.path.join(self.hub_dir, f"{name}-{version}.tar.gz")
        with tarfile.open(bundle_path, "w:gz") as tar:
            tar.add(executor_dir, arcname=name)
            data = yaml.safe_dump(manifest).encode()
            info = tarfile.TarInfo("manifest.yml")
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
        self.logger.info(f"pushed {name}:{version} -> {bundle_path}")
        return bundle_path

    # --- pull -----------------------------------------------------------
    def pull(self, name: str, version: Optional[str] = None,
             target_dir: Optional[str] = None) -> str:
        """Install an executor bundle; returns the installed package dir."""
        version = version or self._latest_version(name)
        bundle_path = os.path.join(self.hub_dir, f"{name}-{version}.tar.gz")
        if not os.path.exists(bundle_path):
            raise FileNotFoundError(f"{name}:{version} not in hub {self.hub_dir}")
        target_dir = target_dir or os.path.expanduser("~/.marie/executors")
        os.makedirs(target_dir, exist_ok=True)
        with tarfile.open(bundle_path, "r:gz") as tar:
            tar.extractall(target_dir, filter="data")
        return os.path.join(target_dir, name)

    def _latest_version(self, name: str) -> str:
        versions = [
            f[len(name) + 1 : -len(".tar.gz")]
            for f in os.listdir(self.hub_dir)
            if f.startswith(f"{name}-") and f.endswith(".tar.gz")
        ]
        if not versions:
            raise FileNotFoundError(f"{name} not in hub {self.hub_dir}")
        return sorted(versions)[-1]

    def list(self) -> List[Dict[str, Any]]:
        out = []
        for f in sorted(os.listdir(self.hub_dir)):
            if not f.endswith(".tar.gz"):
                continue
            stem = f[: -len(".tar.gz")]
            name, _, version = stem.rpartition("-")
            out.append({"name": name, "version": version, "bundle": f})
        return out
