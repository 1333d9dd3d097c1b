"""Native JSONL toast handler (reference: marie/messaging/native_handler.py)."""

import json
import os
import threading
from typing import Any, Dict


class NativeToastHandler:
    def __init__(self, path: str = "/tmp/marie/events.jsonl"):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._lock = threading.Lock()

    def notify(self, event: str, notification: Dict[str, Any], **kwargs) -> None:
        with self._lock, open(self.path, "a") as fp:
            fp.write(json.dumps({"event": event, **notification}) + "\n")
