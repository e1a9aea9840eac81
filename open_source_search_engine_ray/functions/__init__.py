"""Pure, Ray-free kernels. Everything here is importable in any worker
process with no side effects beyond loading a 512 KiB hash-table artifact."""
