"""kornia stub: imported at module scope by sgm's encoders (image
augmentation paths the golden dumps never execute)."""


def __getattr__(name):
    raise RuntimeError(f'kornia stub: {name} unavailable')
