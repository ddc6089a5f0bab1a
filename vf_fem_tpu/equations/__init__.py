from . import newmark, smoothapprox
