from showo_tpu.serving.engine import (ContinuousBatchingEngine, Request,
                                      Showo2MMUServer, ShowoMMUServer)

__all__ = ["ContinuousBatchingEngine", "Request", "Showo2MMUServer",
           "ShowoMMUServer"]
