"""omegaconf stub: sgm type-checks against ListConfig/DictConfig and calls
OmegaConf.to_container on configs; dumps pass plain dicts/lists instead."""


class ListConfig(list):
    pass


class DictConfig(dict):
    pass


class OmegaConf:
    @staticmethod
    def to_container(cfg, resolve=True):
        return cfg

    @staticmethod
    def create(obj=None):
        return obj
