from . import assembly, continuum, elements, forms
