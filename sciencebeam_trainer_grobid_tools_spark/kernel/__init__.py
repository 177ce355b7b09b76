"""Pure python+numpy kernels (no Spark imports) used inside Arrow-batched UDFs."""
