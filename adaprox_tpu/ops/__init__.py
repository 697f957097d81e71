from . import prox, oracles, linops
