import torch.nn as nn


class BaseMixin(nn.Module):
    def __init__(self):
        super().__init__()

    def reinit(self, parent_model=None):
        pass
