from . import (ColumnParallelLinear, RowParallelLinear,  # noqa: F401
               VocabParallelEmbedding)
