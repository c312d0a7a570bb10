"""Host IO: image decode/encode, sidecars, LUT parsing."""
