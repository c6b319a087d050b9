from kornia.utils.grid import create_meshgrid  # noqa: F401
