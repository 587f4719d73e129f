"""Multi-chip scaling (SURVEY.md §2.4, §5.8).

The reference is a single-process desktop app with zero distribution; its
only scaling mechanism is 30 s disk chunking for *memory*, not parallelism.
The TPU-native story:

  * one v5e chip masters a 3-minute track in ~1 ms — a single chip is the
    unit of serving;
  * fleet throughput scales by pure data parallelism over tracks
    (parallel.batch — independent tracks, no cross-device traffic);
  * very long programs (hours of audio) scale by sequence parallelism over
    the time axis (parallel.sequence — the scan-IIR carry becomes an
    all-gather of per-shard boundary states over ICI); the FULL quality
    chain runs time-sharded end to end in parallel.sp_master (exact sp-IIR
    EQ + gathered gated-loudness stats + halo'd true peak and limiter);
  * the mood CNN trains data+tensor parallel (parallel.train).
"""
