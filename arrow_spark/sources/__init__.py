from arrow_spark.sources.ipc import read_ipc, write_ipc  # noqa: F401
from arrow_spark.sources.dataset import read_dataset, write_dataset  # noqa: F401
