from kornia.geometry.subpix import dsnt  # noqa: F401
