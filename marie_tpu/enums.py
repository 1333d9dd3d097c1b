"""Framework enums.

Parity with the reference's vocabulary (``/root/reference/marie/enums.py``)
plus TPU-specific additions (bucketing policy, device placement).
"""

from enum import Enum, IntEnum


class BetterEnum(str, Enum):
    """String-valued enum that parses case-insensitively from YAML/CLI."""

    def __str__(self) -> str:
        return self.value

    @classmethod
    def from_string(cls, s: str) -> "BetterEnum":
        try:
            return cls(s.lower())
        except ValueError:
            raise ValueError(
                f"{s!r} is not a valid {cls.__name__}; choose from "
                f"{[e.value for e in cls]}"
            )


class ProtocolType(BetterEnum):
    """Serving protocol (reference: marie/enums.py ProtocolType)."""

    GRPC = "grpc"
    HTTP = "http"
    WEBSOCKET = "websocket"


class PollingType(BetterEnum):
    """Head fan-out semantics for sharded deployments."""

    ANY = "any"  # route to one shard
    ALL = "all"  # broadcast to all shards, reduce results


class PodRoleType(BetterEnum):
    """Role of a pod inside a deployment."""

    WORKER = "worker"
    HEAD = "head"
    GATEWAY = "gateway"


class DeploymentRoleType(BetterEnum):
    DEPLOYMENT = "deployment"
    GATEWAY = "gateway"


class PSMode(BetterEnum):
    """Page segmentation modes (reference: marie/boxes/box_processor.py:129).

    * WORD       — treat the image as a single word
    * SPARSE     — find as much text as possible in no particular order
    * LINE       — treat the image as a single text line
    * RAW_LINE   — single text line, no bounding-box detection performed
    * MULTI_LINE — multiple text lines, no bounding-box detection performed
    """

    WORD = "word"
    SPARSE = "sparse"
    LINE = "line"
    RAW_LINE = "raw_line"
    MULTI_LINE = "multiline"

    @staticmethod
    def from_value(value: "str | None") -> "PSMode":
        if value is None:
            return PSMode.SPARSE
        for m in PSMode:
            if m.value == value.lower():
                return m
        return PSMode.SPARSE


class CoordinateFormat(BetterEnum):
    """Box coordinate convention (reference: marie/ocr/coordinate_format.py)."""

    XYWH = "xywh"
    XYXY = "xyxy"

    @staticmethod
    def convert(box, from_fmt: "CoordinateFormat", to_fmt: "CoordinateFormat"):
        if from_fmt == to_fmt:
            return list(box)
        x0, y0, a, b = box
        if from_fmt == CoordinateFormat.XYWH:  # -> xyxy
            return [x0, y0, x0 + a, y0 + b]
        return [x0, y0, a - x0, b - y0]  # xyxy -> xywh


class WorkState(BetterEnum):
    """Job lifecycle states (reference: marie/scheduler/state.py)."""

    CREATED = "created"
    RETRY = "retry"
    ACTIVE = "active"
    COMPLETED = "completed"
    EXPIRED = "expired"
    CANCELLED = "cancelled"
    FAILED = "failed"

    @property
    def is_terminal(self) -> bool:
        return self in (
            WorkState.COMPLETED,
            WorkState.EXPIRED,
            WorkState.CANCELLED,
            WorkState.FAILED,
        )


class JobStatus(BetterEnum):
    """Ray-jobs-like status vocabulary (reference: marie/job/common.py)."""

    PENDING = "pending"
    RUNNING = "running"
    SUCCEEDED = "succeeded"
    FAILED = "failed"
    STOPPED = "stopped"

    @property
    def is_terminal(self) -> bool:
        return self in (JobStatus.SUCCEEDED, JobStatus.FAILED, JobStatus.STOPPED)


class BucketPolicy(BetterEnum):
    """How pages/crops are padded into static shapes (TPU-specific)."""

    NEAREST = "nearest"  # pad up to the nearest bucket
    SINGLE = "single"  # always pad to the largest bucket (one compiled program)


class OutputFormat(BetterEnum):
    """Pipeline artifact formats (reference: marie/pipe/extract_pipeline.py)."""

    JSON = "json"
    PDF = "pdf"
    TEXT = "text"
    ADLIB = "adlib"
    BLOBS = "blobs"


class ComputeBackend(BetterEnum):
    TPU = "tpu"
    CPU = "cpu"
    AUTO = "auto"
