"""Library services: folder scanning, thumbnails, albums, presets, ratings."""
