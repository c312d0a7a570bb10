"""Host-side parameter layer: adjustment-JSON -> device param pytrees.

This package is the executable port of the reference's L2 adjustment data
model (src-tauri/src/image_processing.rs:1195-2321). Everything here runs on
the host in NumPy; the output is a pytree of jnp arrays (`DevelopParams`)
plus a hashable static config (`DevelopConfig`) that drives jit
specialization, mirroring how the reference's shader skips work via
`if (param != 0)` early-outs.
"""
