from .attention import dot_product_attention, set_attention_backend
from .norms import group_norm, layer_norm
from .resize import resize_bilinear, resize_nearest, pad_to_fit
from .flash_attention import flash_attention
