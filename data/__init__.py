# Compatibility package: reference-style imports (`from data import
# colorize_image as CI`, `from data import lab_gamut`) resolve to the TPU
# framework, so code written against the reference runs verbatim from this
# repo root (the north-star drop-in requirement).
