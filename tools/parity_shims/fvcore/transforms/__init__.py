from fvcore.transforms.transform import (  # noqa: F401
    BlendTransform, CropTransform, HFlipTransform, NoOpTransform,
    PadTransform, ScaleTransform, Transform, TransformList, VFlipTransform)
