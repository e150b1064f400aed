"""L7: figure pipeline regenerating the reference's paper-figure families
from our own measured campaign outputs."""
