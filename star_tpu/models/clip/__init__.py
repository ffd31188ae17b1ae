from .text import CLIPTextEncoder
from .tokenizer import CLIPTokenizer, HashTokenizer, default_tokenizer
