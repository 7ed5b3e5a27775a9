"""Engine context — the `LSHServer` equivalent without mutable globals.

The reference keeps two mutable globals (`LSHServer.lshEngine`,
`LSHServer.isUseDense`, `LSHServer.scala:5-18`) that every layer reads —
SURVEY.md flags this as a design to avoid. Here the context is an explicit
object the front-ends own; a module-level default instance is provided only
for API familiarity.
"""

from __future__ import annotations

from typing import Optional

from ..config import RDFConfig
from ..models.families import HashModel, generate_model


class LSHServer:
    """Holds the active hash engine + data-format flag for a deployment."""

    def __init__(self) -> None:
        self.lsh_engine: Optional[HashModel] = None
        self.conf: Optional[RDFConfig] = None
        self.is_use_dense: bool = True

    def init_engine(self, conf: RDFConfig) -> HashModel:
        self.conf = conf
        self.is_use_dense = conf.feature_data_format == "dense"
        self.lsh_engine = generate_model(conf)
        return self.lsh_engine


# default instance for drop-in familiarity with the reference's object
default_server = LSHServer()
