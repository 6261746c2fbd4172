"""NumPy/SciPy oracle: ground truth for parity testing (survey §7.1)."""

from apvast_tpu.oracle.reference_np import ReferenceApVast, reference_jdiag

__all__ = ["ReferenceApVast", "reference_jdiag"]
