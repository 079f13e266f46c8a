"""Batched streaming engine: the daemon's per-package record chain
(NS -> AEC -> AGC -> VAD, src/wmix.c:528-872) re-expressed as one jitted
device program over a batch of stream slots."""
