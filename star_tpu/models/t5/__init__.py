from .encoder import T5Encoder, RMSNorm, relative_position_buckets
