from .depthwise_conv import depthwise_conv1d_prelu

__all__ = ["depthwise_conv1d_prelu"]
