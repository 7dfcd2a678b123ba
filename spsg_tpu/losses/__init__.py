from . import gan, geo, semantic, style, twod
