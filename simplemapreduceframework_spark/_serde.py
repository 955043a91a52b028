"""Worker-serialization helper.

Functions defined in this package are shipped to Python workers by
cloudpickle. By default cloudpickle serializes module-level functions
*by reference* (module name + qualname), which breaks when the driver
imported the package from a path the worker processes don't have (e.g.
the external driver adds /root/repo to sys.path at runtime). Modules
that ship callables to workers (pandas UDFs, mapInPandas bodies,
applyInPandasWithState update functions, compat mapper/reducers) call
``pickle_by_value(__name__)`` at import time so those functions are
serialized by value instead — the Spark-native analogue of the
reference shipping its functions file to every worker
(reference worker.py:34-39).
"""

from __future__ import annotations

import sys


def pickle_by_value(module_name: str) -> None:
    module = sys.modules[module_name]
    try:
        from pyspark import cloudpickle
    except ImportError:  # pragma: no cover - fallback for plain cloudpickle
        import cloudpickle  # type: ignore[no-redef]
    cloudpickle.register_pickle_by_value(module)
