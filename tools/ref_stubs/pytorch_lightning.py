"""pytorch_lightning stub: sgm's AbstractAutoencoder subclasses
pl.LightningModule but the golden dumps only exercise plain forward passes —
nn.Module supplies everything touched."""

import torch.nn as nn

LightningModule = nn.Module


class Callback:
    pass


class Trainer:
    def __init__(self, *a, **k):
        raise RuntimeError('pytorch_lightning stub: Trainer unavailable')
