from .dit import CogVideoDiT, DiTLayer, rope_3d_tables
