"""Compositions: negative conversion, HDR merge, panorama, culling."""
