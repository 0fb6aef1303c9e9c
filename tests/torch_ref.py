"""Helper to import the PyTorch reference (read-only, /root/reference) as a
parity oracle. The reference is NEVER imported by openglue_tpu itself — tests
only, to check numerics per SURVEY.md §4 ("golden-parity tests against captured
PyTorch activations").
"""

import sys
from pathlib import Path

REFERENCE_PATH = Path("/root/reference")


def import_reference():
    if not REFERENCE_PATH.exists():
        return None
    if str(REFERENCE_PATH) not in sys.path:
        sys.path.insert(0, str(REFERENCE_PATH))
    return REFERENCE_PATH


def reference_available() -> bool:
    return REFERENCE_PATH.exists()
