from .particle_filter import GPMDM_PF
from .particle_filter import (
    PFOutputs,
    PFState,
    pf_init,
    pf_init_bank,
    pf_scan,
    pf_scan_bank,
    pf_scan_bank_masked,
    pf_scan_masked,
    pf_step,
)
