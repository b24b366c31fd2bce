from . import kernels, layout, linalg
