"""Host service layer: the daemon control plane, task workers, client
API and CLI (reference L2/L3/L6), re-hosted around the TPU engine.

The wire protocol (SysV message queues keyed by ftok("/tmp/wmix", 'w'),
WMix_Msg layout, per-task queues at /tmp/wmix/<id>, SysV shared-memory
mic rings 'I'/'L') is kept binary-compatible with srcMsg/wmix_user.c, so
clients built against the C library can drive this daemon unchanged."""
