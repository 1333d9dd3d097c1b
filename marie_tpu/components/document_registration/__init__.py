from marie_tpu.components.document_registration.boundary import (
    DocumentBoundaryPrediction,
    DocumentBoundaryRegistration,
)

__all__ = ["DocumentBoundaryRegistration", "DocumentBoundaryPrediction"]
