from . import fusion, scan, semantics
