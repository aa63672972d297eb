"""Client API surface: FT.* command dispatch over a keyspace.

Reference layer L7 (src/commands/, command table src/module_loader.cc:33-129).
"""

from valkey_search_tpu.server.engine import Engine  # noqa: F401
from valkey_search_tpu.server.resp import RespServer  # noqa: F401
