"""Geometry: perspective/lens warp, orientation/flip/rotate/crop, downscale.

TPU port of the reference's L4 CPU transform pipeline
(image_processing.rs:356-1175, adjustment_utils.rs:93-120).
"""
