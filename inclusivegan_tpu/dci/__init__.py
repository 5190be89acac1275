from .dci import DCI  # noqa: F401
