"""Interop tools: reference (PyTorch) checkpoint / bins importers."""

from bitswap_tpu.tools.import_reference import (  # noqa: F401
    import_state_dict,
    import_reference_bins,
    load_torch_state_dict,
)
