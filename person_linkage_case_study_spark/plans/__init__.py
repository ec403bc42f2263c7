from .cascade import CascadeConfig, ModuleConfig, PassConfig, PersonLinkageCascade
from .preprocess import preprocess_census, preprocess_reference_file

__all__ = [
    "CascadeConfig",
    "ModuleConfig",
    "PassConfig",
    "PersonLinkageCascade",
    "preprocess_census",
    "preprocess_reference_file",
]
