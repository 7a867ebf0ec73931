"""pc layer — preconditioners (reference: src/pc, PCDUAL)."""

from .dual import PCDual
