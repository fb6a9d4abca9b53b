from .itertoolz import partition_all  # noqa
