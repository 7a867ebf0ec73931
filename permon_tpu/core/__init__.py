from . import convergence, eig, linop
