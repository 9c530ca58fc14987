from .poisson import PoissonProblem
