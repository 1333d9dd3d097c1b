"""Framework exceptions (reference vocabulary: /root/reference/marie/excepts.py)."""


class BaseMarieException(Exception):
    """Root of all framework exceptions."""


class RuntimeFailToStart(BaseMarieException, SystemError):
    """A runtime process failed to start."""


class RuntimeTerminated(BaseMarieException, KeyboardInterrupt):
    """A runtime was terminated by signal."""


class FlowTopologyError(BaseMarieException, ValueError):
    """The flow DAG is malformed (cycle, missing dependency)."""


class FlowMissingDeploymentError(FlowTopologyError):
    """A `needs` edge points at a deployment that does not exist."""


class BadConfigSource(BaseMarieException, FileNotFoundError):
    """YAML config could not be located or parsed."""


class BadYAMLVersion(BaseMarieException, ValueError):
    pass


class BadRequestType(BaseMarieException, TypeError):
    """Request object has the wrong type."""


class BadServer(BaseMarieException):
    """Server responded with an error."""


class BadClient(BaseMarieException):
    """Client-side failure."""


class InternalNetworkError(BaseMarieException):
    """gRPC transport error after retries were exhausted."""

    def __init__(self, og_exception=None, request_id: str = "", details: str = ""):
        self.og_exception = og_exception
        self.request_id = request_id
        self._details = details
        super().__init__(details or str(og_exception))

    def details(self) -> str:
        return self._details or str(self.og_exception)


class ExecutorError(BaseMarieException):
    """An executor endpoint raised; carries structured error info."""

    def __init__(self, name: str = "", args=None, stacks=None, executor: str = ""):
        self.name = name
        self.args_ = args or []
        self.stacks = stacks or []
        self.executor = executor
        super().__init__(name)


class RuntimeRunForeverEarlyError(BaseMarieException):
    """run_forever exited before cancellation."""


class PortAlreadyUsed(BaseMarieException, OSError):
    pass


class EstablishGrpcConnectionError(BaseMarieException):
    pass


class ModelRegistryError(BaseMarieException):
    """Model could not be resolved from the registry."""


class ShapeBucketError(BaseMarieException, ValueError):
    """Input exceeds the largest configured static-shape bucket."""


class JobNotFoundError(BaseMarieException, KeyError):
    pass


class StorageError(BaseMarieException, IOError):
    pass
