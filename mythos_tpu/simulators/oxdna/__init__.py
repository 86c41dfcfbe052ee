"""oxDNA standalone-engine wrappers (validation backend)."""

from mythos_tpu.simulators.oxdna.oxdna import oxDNASimulator, oxDNAUmbrellaSampler
from mythos_tpu.simulators.oxdna.utils import (
    DEFAULT_OXDNA_VARIABLE_MAPPER,
    read_energy,
    read_last_hist,
    read_output_trajectory,
    read_src_h,
    update_params,
    write_src_h,
)

__all__ = [
    "DEFAULT_OXDNA_VARIABLE_MAPPER",
    "oxDNASimulator",
    "oxDNAUmbrellaSampler",
    "read_energy",
    "read_last_hist",
    "read_output_trajectory",
    "read_src_h",
    "update_params",
    "write_src_h",
]
