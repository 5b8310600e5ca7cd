def differentiable_all_reduce(input):
    return input
