from torchvision import models  # noqa: F401
