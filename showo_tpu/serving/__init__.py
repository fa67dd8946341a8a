from showo_tpu.serving.engine import (ContinuousBatchingEngine, Request,
                                      ShowoMMUServer)

__all__ = ["ContinuousBatchingEngine", "Request", "ShowoMMUServer"]
