"""Ray Data stage definitions: batch UDFs (stateless tasks) and actor-pool
classes, all Arrow-in/Arrow-out (``batch_format="pyarrow"``)."""
