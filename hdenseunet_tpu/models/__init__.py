from . import layers, denseunet2d, denseunet3d, hybrid, dilated_resnet

__all__ = ["layers", "denseunet2d", "denseunet3d", "hybrid", "dilated_resnet"]
