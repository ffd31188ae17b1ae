"""timm stub for golden dumps. Only `models.vision_transformer.Mlp` is
imported by the reference (unet_v2v.py:14) and it is referenced solely by the
commented-out CaptionEmbedder path (unet_v2v.py:27, 1954-1961) — never
instantiated at runtime. The class below matches timm's param naming anyway
(fc1/fc2) in case a future dump touches it."""
