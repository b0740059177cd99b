from .wan_prompter import WanPrompter
from .omost import OmostPrompter, Canvas
from .prompt_extend import PromptRefinerChain, TemplatePromptExpander
from .prompt_extend import BeautifulPrompt, QwenPrompt, Translator
