from . import chunks, fusion, scan, semantics, sens
