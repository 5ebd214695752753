from .edn import dumps as edn_dumps  # noqa: F401
from .edn import loads as edn_loads  # noqa: F401
