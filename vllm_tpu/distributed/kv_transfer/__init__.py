from vllm_tpu.distributed.kv_transfer.base import (KVConnectorBase,
                                                   KVConnectorRole,
                                                   create_connector)

__all__ = ["KVConnectorBase", "KVConnectorRole", "create_connector"]
