from .particle_filter import GPMDM_PF
