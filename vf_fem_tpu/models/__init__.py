from . import dynamical, fsi, transient
