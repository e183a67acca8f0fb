"""Support helpers (reference ``networkit/support.py``)."""


class MissingDependencyError(RuntimeError):
    """Raised when an optional rendering/interop dependency is absent
    (reference ``networkit/support.py:4`` — same message shape)."""

    def __init__(self, package: str):
        super().__init__(f"Missing optional dependency: {package}")
        self.package = package
