"""RAW front-end: Bayer demosaic, white balance, camera-matrix color
transform and highlight compression — the TPU-native equivalent of the
reference's rawler-based develop (src-tauri/src/raw_processing.rs)."""
